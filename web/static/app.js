/* RTMODT-TPU web demo SPA.
 * Three modes: sample gallery / drag-drop upload / live webcam capture loop,
 * driving the same REST API as the reference backend (/api/samples,
 * /api/detect/{image,frame,sample/{f}}). */

"use strict";

const canvas = document.getElementById("result-canvas");
const ctx = canvas.getContext("2d");
const loader = document.getElementById("loader");
const toast = document.getElementById("toast");
const detList = document.getElementById("detections-list");

const PALETTE = [
  "#ff5d5d", "#ffb020", "#ffe85d", "#9bff5d", "#38e0a5", "#35d4e8",
  "#4d8dff", "#8a5dff", "#e05df0", "#ff5da8", "#c2ff5d", "#5dfff3",
];

let currentImage = null;   // HTMLImageElement or video frame bitmap
let webcamStream = null;
let webcamTimer = null;
let webcamBusy = false;
// per-tab tracker session: the backend keeps ByteTrack state for this id
const sessionId = `web-${Math.random().toString(36).slice(2, 10)}`;

/* ---------- mode switching ---------- */
document.querySelectorAll(".tab").forEach((tab) => {
  tab.addEventListener("click", () => switchMode(tab.dataset.mode));
});

let currentMode = "samples";

function switchMode(mode) {
  if (mode === currentMode) return;   // re-clicking the tab must not kill playback
  currentMode = mode;
  document.querySelectorAll(".tab").forEach((t) =>
    t.classList.toggle("active", t.dataset.mode === mode));
  document.querySelectorAll(".panel").forEach((p) =>
    p.classList.toggle("active", p.id === `panel-${mode}`));
  if (mode !== "webcam") stopWebcam();
  if (mode !== "live") stopLiveDemo();
  stopVideoPlayback();
}

function escHtml(s) {
  // server-echoed strings (zone names etc.) are client-supplied via the
  // API - never interpolate them into innerHTML unescaped
  return String(s).replace(/[&<>"']/g, (c) => ({
    "&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;", "'": "&#39;",
  }[c]));
}

/* ---------- samples ---------- */
async function loadSamples() {
  const grid = document.getElementById("sample-grid");
  try {
    const res = await fetch("/api/samples");
    const data = await res.json();
    if (!data.samples.length) {
      grid.innerHTML =
        '<p class="muted">No samples found. Run <code>python tools/download_samples.py</code> ' +
        "or drop files into <code>web/static/samples/</code>.</p>";
      return;
    }
    grid.innerHTML = "";
    for (const s of data.samples) {
      const card = document.createElement("div");
      card.className = "sample-card";
      card.innerHTML = `<img src="${s.url}" alt="${s.name}" loading="lazy" />
                        <span>${s.name}</span>`;
      card.addEventListener("click", () => detectSample(s));
      grid.appendChild(card);
    }
  } catch (err) {
    grid.innerHTML = `<p class="muted">Failed to load samples: ${err}</p>`;
  }
}

async function detectSample(sample) {
  showLoader(true);
  try {
    stopVideoPlayback();
    lastVideoFile = null;           // a zone action must not re-track an
    zoneControls.hidden = true;     // older video over this image
    const img = await loadImage(sample.url);
    currentImage = img;
    const res = await fetch(`/api/detect/sample/${sample.filename}`);
    if (!res.ok) throw new Error((await res.json()).detail || res.status);
    drawResults(await res.json());
  } catch (err) {
    showToast(`Detection failed: ${err.message || err}`);
  } finally {
    showLoader(false);
  }
}

/* ---------- upload ---------- */
const dropzone = document.getElementById("dropzone");
const fileInput = document.getElementById("file-input");

dropzone.addEventListener("click", () => fileInput.click());
fileInput.addEventListener("change", () => {
  if (fileInput.files.length) handleFile(fileInput.files[0]);
});
["dragover", "dragenter"].forEach((ev) =>
  dropzone.addEventListener(ev, (e) => {
    e.preventDefault();
    dropzone.classList.add("hover");
  }));
["dragleave", "drop"].forEach((ev) =>
  dropzone.addEventListener(ev, (e) => {
    e.preventDefault();
    dropzone.classList.remove("hover");
  }));
dropzone.addEventListener("drop", (e) => {
  if (e.dataTransfer.files.length) handleFile(e.dataTransfer.files[0]);
});

async function handleFile(file) {
  showLoader(true);
  stopVideoPlayback();
  try {
    if (file.type.startsWith("video/")) {
      await trackVideo(file);
      return;
    }
    lastVideoFile = null;           // image shown: zone clicks must not
    zoneControls.hidden = true;     // silently re-track an older video
    currentImage = await loadImage(URL.createObjectURL(file));
    const form = new FormData();
    form.append("file", file, file.name);
    const res = await fetch("/api/detect/image", { method: "POST", body: form });
    if (!res.ok) throw new Error((await res.json()).detail || res.status);
    drawResults(await res.json());
  } catch (err) {
    showToast(`Upload failed: ${err.message || err}`);
  } finally {
    showLoader(false);
  }
}

/* Uploaded videos go through the server-side tracker
   (POST /api/track/video) and play back with persistent-ID overlays -
   the reference SPA only analyzes a single captured frame. */
let videoAnim = null;

/* ---------- zones: draw polygons on the video, server fires events ------ */
let zones = [];            // completed [{name, polygon: [[x,y],...]}]
let pendingZone = null;    // vertices being drawn, or null
let lastVideoFile = null;  // re-track this file when zones change
let liveEvents = [];       // rolling webcam alert feed (newest first)

const zoneControls = document.getElementById("zone-controls");
const trackerAlgo = document.getElementById("tracker-algo");
// switching trackers re-runs the current video (the server restarts a
// webcam session automatically when its algorithm changes)
trackerAlgo.addEventListener("change", () => {
  if (uploadModeActive() && lastVideoFile) handleFile(lastVideoFile);
});
const zoneDrawBtn = document.getElementById("zone-draw");
const zoneClearBtn = document.getElementById("zone-clear");
const zoneHint = document.getElementById("zone-hint");

zoneDrawBtn.addEventListener("click", () => {
  pendingZone = pendingZone ? null : [];
  zoneDrawBtn.textContent = pendingZone ? "Cancel drawing" : "Draw zone";
  zoneHint.textContent = pendingZone
    ? "click vertices on the video, double-click to close the zone"
    : "zones re-run the tracker with intrusion alerts";
});

zoneClearBtn.addEventListener("click", () => {
  zones = [];
  pendingZone = null;
  liveEvents = [];
  zoneDrawBtn.textContent = "Draw zone";
  zoneClearBtn.disabled = true;
  if (uploadModeActive() && lastVideoFile) handleFile(lastVideoFile);
});

/* Zones are stored NORMALIZED (0..1 of the frame) and scaled to the pixel
   space of whatever source they are sent with - the canvas size at draw
   time can differ from the next source's resolution (e.g. a zone drawn on
   a 640x360 video, then used with 1280x720 webcam frames). */
function canvasPoint(e) {
  const r = canvas.getBoundingClientRect();
  const clamp = (v) => Math.min(1, Math.max(0, v));
  return [clamp((e.clientX - r.left) / r.width),
          clamp((e.clientY - r.top) / r.height)];
}

function pixelZones(w, h) {
  return zones.map((z) => ({
    ...z,
    polygon: z.polygon.map(([x, y]) => [Math.round(x * w), Math.round(y * h)]),
  }));
}

canvas.addEventListener("click", (e) => {
  if (pendingZone) pendingZone.push(canvasPoint(e));
});

function uploadModeActive() {
  const tab = document.querySelector(".tab.active");
  return tab && tab.dataset.mode === "upload";
}

canvas.addEventListener("dblclick", () => {
  if (!pendingZone || pendingZone.length < 4) return;
  pendingZone.pop();                       // dblclick also fired a click
  zones.push({ name: `zone-${zones.length + 1}`, polygon: pendingZone });
  pendingZone = null;
  zoneDrawBtn.textContent = "Draw zone";
  zoneClearBtn.disabled = false;
  zoneHint.textContent = "zones alert on intrusion (videos and live webcam)";
  // uploaded videos need a server re-track; the live webcam loop just
  // starts sending the new zones with its next frame
  if (uploadModeActive() && lastVideoFile) handleFile(lastVideoFile);
});

function drawZones(serverZones, flashing) {
  for (const z of serverZones) {
    const hot = flashing.has(z.name);
    ctx.beginPath();
    z.polygon.forEach(([x, y], i) => (i ? ctx.lineTo(x, y) : ctx.moveTo(x, y)));
    ctx.closePath();
    ctx.fillStyle = hot ? "rgba(255,60,60,0.30)" : "rgba(80,160,255,0.18)";
    ctx.fill();
    ctx.strokeStyle = hot ? "#ff3c3c" : "#50a0ff";
    ctx.lineWidth = 2;
    ctx.stroke();
    const [lx, ly] = z.polygon[0];
    ctx.font = "13px ui-monospace, monospace";
    ctx.fillStyle = hot ? "#ff3c3c" : "#50a0ff";
    ctx.fillText(z.name, lx + 4, ly + 14);
  }
  if (pendingZone && pendingZone.length) {
    ctx.beginPath();
    pendingZone.forEach(([nx, ny], i) => {
      const x = nx * canvas.width, y = ny * canvas.height;
      i ? ctx.lineTo(x, y) : ctx.moveTo(x, y);
    });
    ctx.strokeStyle = "#ffe85d";
    ctx.lineWidth = 2;
    ctx.setLineDash([6, 4]);
    ctx.stroke();
    ctx.setLineDash([]);
  }
}

function stopVideoPlayback() {
  if (videoAnim) {
    cancelAnimationFrame(videoAnim.raf);
    videoAnim.video.pause();
    URL.revokeObjectURL(videoAnim.video.src);
    videoAnim = null;
  }
}

let trackReqGen = 0;   // newest request wins; stale completions discard

async function trackVideo(file) {
  const myReq = ++trackReqGen;
  // load the video FIRST: fails fast on unreadable files and provides the
  // native resolution that normalized zones scale to
  const video = document.createElement("video");
  video.muted = true;
  video.loop = true;
  video.playsInline = true;
  video.src = URL.createObjectURL(file);
  let data;
  try {
    await new Promise((ok, bad) => {
      video.addEventListener("loadeddata", ok, { once: true });
      video.addEventListener("error", () => bad(new Error("cannot read video")),
                             { once: true });
    });
    const form = new FormData();
    form.append("file", file, file.name);
    if (zones.length) {
      form.append("zones",
                  JSON.stringify(pixelZones(video.videoWidth, video.videoHeight)));
    }
    const res = await fetch(
      `/api/track/video?max_frames=300&algorithm=${trackerAlgo.value}`,
      { method: "POST", body: form });
    if (!res.ok) throw new Error((await res.json()).detail || res.status);
    data = await res.json();
    if (!data.frames.length) throw new Error("no frames tracked");
  } catch (err) {
    URL.revokeObjectURL(video.src);   // failed attempts must not leak blobs
    throw err;
  }
  if (myReq !== trackReqGen) {
    // a newer upload/re-track superseded this one mid-flight: discard
    URL.revokeObjectURL(video.src);
    return;
  }
  lastVideoFile = file;
  zoneControls.hidden = false;
  const serverZones = data.zones || [];
  const events = data.events || [];
  // zone_name -> sorted event frame ids (for the red flash on playback)
  const zoneEventFids = new Map();
  for (const ev of events) {
    if (!zoneEventFids.has(ev.zone_name)) zoneEventFids.set(ev.zone_name, []);
    zoneEventFids.get(ev.zone_name).push(ev.frame_id);
  }
  const fps = data.video_fps > 0 ? data.video_fps : 25;
  const byFrame = new Map(data.frames.map((f) => [f.frame_id, f.tracks]));
  const maxFid = data.frames[data.frames.length - 1].frame_id;
  const stride = data.frames.length > 1
    ? data.frames[1].frame_id - data.frames[0].frame_id : 1;

  canvas.width = video.videoWidth;
  canvas.height = video.videoHeight;
  document.getElementById("stat-objects").textContent = data.num_tracks;
  document.getElementById("stat-latency").textContent =
    (1000 / Math.max(1, data.processing_fps)).toFixed(1);
  document.getElementById("stat-size").textContent =
    `${canvas.width}×${canvas.height}`;
  let html =
    `<p class="muted">${data.num_tracks} track(s) over ` +
    `${data.num_frames} frames · server ${data.processing_fps} fps</p>`;
  if (serverZones.length) {
    html += `<p class="muted">${events.length} zone event(s)</p>`;
    const zc = data.zone_counts || {};
    for (const [zn, c] of Object.entries(zc)) {
      html += `<div class="det-row"><span class="dot" style="background:#4c9aff"></span>` +
              `<span class="det-name">${escHtml(zn)}</span>` +
              `<span class="det-conf">${Number(c.entries)} entr${Number(c.entries) === 1 ? "y" : "ies"} · ` +
              `${Number(c.unique_tracks)} unique · ${Number(c.current)} at end</span></div>`;
    }
    for (const ev of events.slice(0, 20)) {
      html += `<div class="det-row"><span class="dot" style="background:#ff3c3c"></span>` +
              `<span class="det-name">${escHtml(ev.event_type)} · ${escHtml(ev.zone_name)}</span>` +
              `<span class="det-conf">track ${Number(ev.track_id)} @ frame ${Number(ev.frame_id)}</span></div>`;
    }
  }
  detList.innerHTML = html;
  await video.play();

  const state = { video, raf: 0 };
  videoAnim = state;
  const tick = () => {
    if (videoAnim !== state) return;
    let fid = Math.min(maxFid, Math.floor(video.currentTime * fps) + 1);
    fid = Math.max(1, fid - ((fid - 1) % stride));   // snap to stride grid
    ctx.drawImage(video, 0, 0, canvas.width, canvas.height);
    const flashing = new Set();
    for (const [name, fids] of zoneEventFids) {
      if (fids.some((f) => f <= fid && fid - f < 12)) flashing.add(name);
    }
    drawZones(serverZones, flashing);
    drawBoxes(byFrame.get(fid) || []);
    state.raf = requestAnimationFrame(tick);
  };
  tick();
}

/* ---------- live demo (server-side MJPEG stream) ---------- */
const liveImg = document.getElementById("live-img");
const liveStartBtn = document.getElementById("live-start");
const liveStopBtn = document.getElementById("live-stop");

function startLiveDemo() {
  const algo = trackerAlgo.value;
  const objects = document.getElementById("live-objects").value;
  // the browser renders multipart/x-mixed-replace natively in an <img>;
  // a cache-buster restarts the stream on every click
  liveImg.src = `/api/stream/demo?algorithm=${algo}&objects=${objects}` +
    `&seconds=60&fps=12&_=${Date.now()}`;
  liveImg.hidden = false;
  liveStartBtn.disabled = true;
  liveStopBtn.disabled = false;
}

function stopLiveDemo() {
  if (liveImg.src) liveImg.src = "";   // closes the connection server-side
  liveImg.hidden = true;
  liveStartBtn.disabled = false;
  liveStopBtn.disabled = true;
}

liveStartBtn.addEventListener("click", startLiveDemo);
liveStopBtn.addEventListener("click", stopLiveDemo);

/* ---------- webcam ---------- */
document.getElementById("webcam-start").addEventListener("click", startWebcam);
document.getElementById("webcam-stop").addEventListener("click", stopWebcam);

async function startWebcam() {
  try {
    webcamStream = await navigator.mediaDevices.getUserMedia({
      video: { width: 1280, height: 720 },
    });
  } catch (err) {
    showToast(`Camera unavailable: ${err.message}`);
    return;
  }
  const video = document.getElementById("webcam-video");
  video.srcObject = webcamStream;
  video.hidden = false;
  zoneControls.hidden = false;
  document.getElementById("webcam-start").disabled = true;
  document.getElementById("webcam-stop").disabled = false;
  const interval = parseInt(document.getElementById("webcam-interval").value, 10);
  webcamTimer = setInterval(() => captureAndDetect(video), interval);
}

function stopWebcam() {
  if (webcamTimer) clearInterval(webcamTimer);
  webcamTimer = null;
  if (webcamStream) webcamStream.getTracks().forEach((t) => t.stop());
  webcamStream = null;
  const video = document.getElementById("webcam-video");
  video.hidden = true;
  document.getElementById("webcam-start").disabled = false;
  document.getElementById("webcam-stop").disabled = true;
}

async function captureAndDetect(video) {
  if (webcamBusy || video.readyState < 2) return;
  webcamBusy = true;
  try {
    const c = document.createElement("canvas");
    c.width = video.videoWidth;
    c.height = video.videoHeight;
    c.getContext("2d").drawImage(video, 0, 0);
    const jpeg = c.toDataURL("image/jpeg", 0.8);   // encode ONCE per tick
    currentImage = await loadImage(jpeg);
    const res = await fetch("/api/detect/frame", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ image: jpeg,
                             session_id: sessionId,
                             algorithm: trackerAlgo.value,
                             ...(zones.length
                                 ? { zones: pixelZones(c.width, c.height) }
                                 : {}) }),
    });
    if (res.ok) drawResults(await res.json());
  } catch (err) {
    /* skip frame on error */
  } finally {
    webcamBusy = false;
  }
}

/* ---------- rendering ---------- */
function loadImage(src) {
  return new Promise((resolve, reject) => {
    const img = new Image();
    img.onload = () => resolve(img);
    img.onerror = () => reject(new Error("image load failed"));
    img.src = src;
  });
}

function drawBoxes(items) {
  const scale = Math.max(1, canvas.width / 960);
  ctx.lineWidth = 2 * scale;
  ctx.font = `${13 * scale}px ui-monospace, monospace`;
  for (const d of items) {
    const [x1, y1, x2, y2] = d.bbox;
    const key = d.track_id !== undefined ? d.track_id : d.class_id;
    const color = PALETTE[((key % PALETTE.length) + PALETTE.length) % PALETTE.length];
    ctx.strokeStyle = color;
    ctx.fillStyle = color + "26";
    ctx.fillRect(x1, y1, x2 - x1, y2 - y1);
    ctx.strokeRect(x1, y1, x2 - x1, y2 - y1);
    const label = (d.track_id !== undefined ? `#${d.track_id} ` : "") +
      `${d.class_name} ${(d.confidence * 100).toFixed(0)}%`;
    const tw = ctx.measureText(label).width + 8 * scale;
    ctx.fillStyle = color;
    ctx.fillRect(x1, Math.max(0, y1 - 18 * scale), tw, 18 * scale);
    ctx.fillStyle = "#0b0e14";
    ctx.fillText(label, x1 + 4 * scale, Math.max(13 * scale, y1 - 5 * scale));
    if (d.trail && d.trail.length > 1) {
      ctx.beginPath();
      ctx.moveTo(d.trail[0][0], d.trail[0][1]);
      for (const [tx, ty] of d.trail.slice(1)) ctx.lineTo(tx, ty);
      ctx.strokeStyle = color;
      ctx.stroke();
    }
  }
}

function drawResults(data) {
  const [iw, ih] = data.image_size;
  canvas.width = iw;
  canvas.height = ih;
  if (currentImage) ctx.drawImage(currentImage, 0, 0, iw, ih);
  else { ctx.fillStyle = "#10141c"; ctx.fillRect(0, 0, iw, ih); }

  // prefer tracks (persistent ids) when present, like the reference SPA
  const items = (data.tracks && data.tracks.length) ? data.tracks : data.detections;
  if (data.zones) {
    const flashing = new Set((data.events || []).map((ev) => ev.zone_name));
    drawZones(data.zones, flashing);
    for (const ev of data.events || []) {       // in firing order, so the
      liveEvents.unshift(ev);                   // newest ends up first and
      showToast(`${ev.event_type}: ${ev.class_name} #${ev.track_id} in ${ev.zone_name}`);
    }                                           // the toast shows the newest
    liveEvents = liveEvents.slice(0, 12);
  } else if (pendingZone) {
    drawZones([], new Set());              // pending-polygon preview only
  }
  drawBoxes(items);

  document.getElementById("stat-objects").textContent = data.num_objects;
  document.getElementById("stat-latency").textContent =
    data.inference_ms.toFixed(1);
  document.getElementById("stat-size").textContent = `${iw}×${ih}`;

  let html = items.length
    ? items.map((d) => {
        const key = d.track_id !== undefined ? d.track_id : d.class_id;
        const color = PALETTE[((key % PALETTE.length) + PALETTE.length) % PALETTE.length];
        return `<div class="det-row">
          <span class="dot" style="background:${color}"></span>
          <span class="det-name">${d.class_name}</span>
          <span class="det-conf">${(d.confidence * 100).toFixed(1)}%</span>
        </div>`;
      }).join("")
    : '<p class="muted">No objects detected.</p>';
  if (data.zones && liveEvents.length) {
    html += `<p class="muted">recent alerts</p>` + liveEvents.map((ev) =>
      `<div class="det-row"><span class="dot" style="background:#ff3c3c"></span>
        <span class="det-name">${escHtml(ev.event_type)} · ${escHtml(ev.zone_name)}</span>
        <span class="det-conf">#${Number(ev.track_id)}</span></div>`).join("");
  }
  detList.innerHTML = html;
}

/* ---------- ui helpers ---------- */
function showLoader(on) { loader.hidden = !on; }

let toastTimer = null;
function showToast(msg) {
  toast.textContent = msg;
  toast.hidden = false;
  clearTimeout(toastTimer);
  toastTimer = setTimeout(() => (toast.hidden = true), 4000);
}

loadSamples();
